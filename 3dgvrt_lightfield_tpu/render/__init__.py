"""Renderers: brute-force ground truth and the tiled/Pallas production path."""

from . import reference
from .reference import render_image, render_rays
