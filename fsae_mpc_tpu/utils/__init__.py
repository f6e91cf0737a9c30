from .io import read_raceline_csv
from . import profiling
