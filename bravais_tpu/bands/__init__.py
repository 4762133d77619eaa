from bravais_tpu.bands.sweep import BandSweep, SweepResult  # noqa: F401
from bravais_tpu.bands.io import (BandWriter, load_bands, plot_bands,  # noqa: F401
                                  save_modes, write_csv, write_vtk)
