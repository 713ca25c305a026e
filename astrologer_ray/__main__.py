import sys
from astrologer_ray.cli import main

sys.exit(main())
