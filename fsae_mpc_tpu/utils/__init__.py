from .io import read_raceline_csv
