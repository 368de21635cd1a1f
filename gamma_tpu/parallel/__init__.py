from gamma_tpu.parallel.sharded import (  # noqa: F401
    ShardedIVFPQ,
    build_mesh,
    shard_ivfpq,
    sharded_ivfpq_search_fn,
    sharded_flat_search_fn,
    sharded_kmeans_fit,
)
