from rec_now_tpu.util.param_normalizer import wrap_as_list  # noqa: F401
from rec_now_tpu.util.numpy_tools import (  # noqa: F401
    calc_sum_of_abs_diff, all_equal)
