"""``python -m record_linkage_ldu_ray`` → the ray-job CLI."""

import sys

from record_linkage_ldu_ray.cli import main

sys.exit(main())
