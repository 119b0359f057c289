import sys

from zotpu.cli import main

sys.exit(main())
