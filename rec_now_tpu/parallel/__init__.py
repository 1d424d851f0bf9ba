from rec_now_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated_sharding)
from rec_now_tpu.parallel.multihost import (  # noqa: F401
    initialize_multihost, put_local_batch)
