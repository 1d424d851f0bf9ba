from rec_now_tpu.training.data import SyntheticCriteo, Batch  # noqa: F401
from rec_now_tpu.training.metrics import (  # noqa: F401
    binary_auc, batch_gauc, StreamingGAUC)
from rec_now_tpu.training.trainer import Trainer, TrainerConfig  # noqa: F401
from rec_now_tpu.training.prefetch import DevicePrefetcher  # noqa: F401
