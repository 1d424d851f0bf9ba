from rec_now_tpu.rec_block.attention import (  # noqa: F401
    attention_by_dot_product, DNNAttention)
from rec_now_tpu.rec_block.embedding_wise_weight import (  # noqa: F401
    gather_embedding_element_wise_weight)
from rec_now_tpu.rec_block import embedding_util  # noqa: F401
