"""Multi-chip / multi-host sharding (new capability; none in the reference)."""

from . import distributed, sharding
from .distributed import data_parallel_mesh, init_distributed
from .sharding import (CameraBatch, camera_batch, make_mesh,
                       plan_capacity_sharded, render_batch_sharded,
                       render_image_tile_sharded,
                       replicate_model)
