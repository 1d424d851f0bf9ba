from rec_now_tpu.models.feature_config import FeatureConfig  # noqa: F401
from rec_now_tpu.models.tower import DNNTower  # noqa: F401
from rec_now_tpu.models.fm_model import FMModel  # noqa: F401
from rec_now_tpu.models.dcn_model import DCNv2Model  # noqa: F401
from rec_now_tpu.models.xdeepfm_model import XDeepFMModel  # noqa: F401
from rec_now_tpu.models.multitask_model import MultiTaskModel  # noqa: F401
from rec_now_tpu.models.can_dcn_model import CANDCNModel  # noqa: F401
