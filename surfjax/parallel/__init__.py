from surfjax.parallel.mesh import (
    initialize_distributed,
    make_mesh,
    render_frame_sharded,
    render_sequence_sharded,
)

__all__ = ["make_mesh", "render_frame_sharded", "render_sequence_sharded",
           "initialize_distributed"]
