"""`python -m bravais_tpu` — the band-structure driver app
(equivalent to `python -m bravais_tpu.cli.bands_app`)."""

import sys

from bravais_tpu.cli.bands_app import main

sys.exit(main())
