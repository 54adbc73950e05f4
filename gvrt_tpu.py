"""Importable alias for the `3dgvrt_lightfield_tpu` package.

The package directory name starts with a digit (kept to mirror the reference
repo's name), which is not a valid Python identifier for `import` statements.
``import gvrt_tpu`` resolves to the real package; since the package imports all
submodules eagerly, attribute access (gvrt_tpu.ops.sh, ...) works, and the
aliasing loop below also makes `import gvrt_tpu.x.y` forms hit the same module
objects instead of double-importing.
"""

import importlib
import sys

_pkg = importlib.import_module("3dgvrt_lightfield_tpu")
for _name, _mod in list(sys.modules.items()):
    if _name.startswith("3dgvrt_lightfield_tpu"):
        sys.modules[_name.replace("3dgvrt_lightfield_tpu", "gvrt_tpu", 1)] = _mod
sys.modules[__name__] = _pkg
