from .track import Track, track_from_points, load_track
from . import spline
