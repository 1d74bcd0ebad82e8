from .extraction import ShardedExtractor  # noqa: F401
from .mesh import (  # noqa: F401
    Mesh, NamedSharding, P, make_mesh, make_multihost_mesh, replicated)
from .ranking import (  # noqa: F401
    shard_codes_binary,
    shard_database,
    shard_database_quantized,
    sharded_aqe,
    sharded_hamming_topk,
    sharded_scores,
    sharded_topk,
)
