from .extraction import ShardedExtractor  # noqa: F401
from .mesh import Mesh, NamedSharding, P, make_mesh, replicated  # noqa: F401
from .ranking import (  # noqa: F401
    shard_database,
    sharded_aqe,
    sharded_scores,
    sharded_topk,
)
