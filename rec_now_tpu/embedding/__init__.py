from rec_now_tpu.embedding.table import (  # noqa: F401
    EmbeddingTable, EmbeddingTableState)
from rec_now_tpu.embedding.sharded import (  # noqa: F401
    ShardedEmbeddingTable, ShardedTableState)
