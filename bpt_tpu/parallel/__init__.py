from bpt_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    render_distributed,
    render_spp_sharded_step,
    shard_step,
)
