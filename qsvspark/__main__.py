"""``python -m qsvspark load data.csv - isin col 1,2 - sort col - show``"""

import sys

from qsvspark.cli import main

sys.exit(main())
