from rec_now_tpu.ops.multi_dense_op import multi_dense_apply  # noqa: F401
from rec_now_tpu.ops.cin_op import cin_contract  # noqa: F401
from rec_now_tpu.ops.hashing import mix32, salted_hash  # noqa: F401
