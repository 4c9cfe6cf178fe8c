from .mesh import (  # noqa: F401
    make_mesh,
    pad_edges_for_sharding,
    shard_posegraph_solve,
    sharded_dense_fuse,
)
from .window_schur import solve_window_schur_sharded  # noqa: F401
from .audit import collective_payloads, summarize_collectives  # noqa: F401
