"""Allow running bench scripts from a source checkout without installing.

Counterpart of the reference's bench/set_path.py:1-4.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
