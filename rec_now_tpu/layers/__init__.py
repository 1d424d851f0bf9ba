from rec_now_tpu.layers.fm_layer import FMLayer  # noqa: F401
from rec_now_tpu.layers.inner_pnn_layer import InnerPNNLayer  # noqa: F401
from rec_now_tpu.layers.pooling_layer import PoolingLayer, pool  # noqa: F401
from rec_now_tpu.layers.fix_length_layer import FixLengthLayer  # noqa: F401
from rec_now_tpu.layers.multi_dense_layer import MultiDenseLayer  # noqa: F401
from rec_now_tpu.layers.dcn_layer import DCNLayer  # noqa: F401
from rec_now_tpu.layers.dcn_mix_layer import DCNMixLayer  # noqa: F401
from rec_now_tpu.layers.cin_layer import CINLayer  # noqa: F401
from rec_now_tpu.layers.mmoe_layer import MMOELayer  # noqa: F401
from rec_now_tpu.layers.ple_layer import PLELayer  # noqa: F401
from rec_now_tpu.layers.senet_layer import SENETLayer  # noqa: F401
from rec_now_tpu.layers.sparse_gnn_layer import SparseGNNLayer  # noqa: F401
from rec_now_tpu.layers.star_dense_layer import (  # noqa: F401
    StarDenseLayer, ParasiticStarDenseLayer)
from rec_now_tpu.layers.stacked_dense_layer import (  # noqa: F401
    StackedDenseLayer, ParasiticStackedDenseLayer)
from rec_now_tpu.layers.can_layer import CANLayer  # noqa: F401
from rec_now_tpu.layers.multi_hash_layer import (  # noqa: F401
    MultiHashLayer, FastMultiHashLayer)
from rec_now_tpu.layers.cartesian_product_layer import (  # noqa: F401
    CartesianProductLayer)
