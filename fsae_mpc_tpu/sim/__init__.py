from .closed_loop import SimConfig, SimOutputs, simulate, simulate_jit
from .batch import perturbed_params, simulate_batch
from . import checkpoint
