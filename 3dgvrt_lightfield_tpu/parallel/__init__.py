"""Multi-chip / multi-host sharding (new capability; none in the reference)."""

from . import sharding
from .sharding import (CameraBatch, camera_batch, make_mesh,
                       render_batch_sharded, replicate_model)
