"""Native host-side IO: multi-threaded Criteo-TSV ingestion.

C++ parser (native/criteo_parser.cpp) over a plain C ABI with a
pure-Python fallback; see criteo.py.
"""
from rec_now_tpu.io.criteo import (CriteoTSV, fnv1a_mod, parse_chunk,
                                   write_synthetic_tsv)

__all__ = ["CriteoTSV", "fnv1a_mod", "parse_chunk",
           "write_synthetic_tsv"]
