import sys

from spleeterrt_tpu.cli import main

sys.exit(main())
