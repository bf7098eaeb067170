from .sharded import (make_mesh, sharded_pipeline, synthesize_block_sp)

__all__ = ["make_mesh", "sharded_pipeline", "synthesize_block_sp"]
