"""Renderers: brute-force ground truth and the tiled/Pallas production path."""

from . import binning
from . import pallas_forward
from . import pallas_vjp
from . import reference
from . import tile_math
from . import tiled
from . import banded
from .reference import render_image, render_rays
from .tiled import render_image_tiled
from .banded import BandedRenderer, render_image_banded
