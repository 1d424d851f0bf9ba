"""Parameter normalization helpers.

Reference: rec_now/util/param_normalizer.py:10-24.
"""
from rec_now_tpu.core.shapes import wrap_as_list  # noqa: F401
