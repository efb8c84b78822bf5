"""`python -m stratum_spark <cmd>` -- see stratum_spark/cli.py."""

import sys

from stratum_spark.cli import main

sys.exit(main())
