"""Native C++ components (fast PLY parsing; built on demand, optional)."""

from . import ply_native
