from rec_now_tpu.losses.pairwise import (  # noqa: F401
    pairwise_loss,
    generate_pair_mask,
    bpr_loss_func,
    occurance_power_weight,
)
from rec_now_tpu.losses.listwise import (  # noqa: F401
    to_listwise_sample,
    listwise_loss_via_softmax_cross_entropy_with_logits,
    listwise_loss,
)
from rec_now_tpu.losses.focal import focal_crossentropy_loss  # noqa: F401
from rec_now_tpu.losses.pointwise import (  # noqa: F401
    sigmoid_cross_entropy_with_logits,
    bce_loss,
)
