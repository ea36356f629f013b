from scx.parallel.mesh import (
    make_mesh,
    shard_env_batch,
    replicate,
    env_sharded,
    psum_stats,
    all_gather_stats,
    sharded_sim_render_step,
)
