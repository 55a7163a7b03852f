"""Make ``vla_fastvlm_tpu`` importable when the package is not installed.

The reference relies on pip-installing its src layout (``pyproject.toml:47-48``
there); in environments where installation is not possible, scripts add the
repo root to ``sys.path`` themselves.
"""

import sys
from pathlib import Path

_ROOT = str(Path(__file__).resolve().parent.parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
