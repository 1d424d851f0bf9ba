from rec_now_tpu.core.shapes import pad_or_truncate, wrap_as_list  # noqa: F401
from rec_now_tpu.core.debug import dbg_print, dbg_minmax  # noqa: F401
