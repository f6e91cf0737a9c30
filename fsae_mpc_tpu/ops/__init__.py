from .condense import condense, condense_associative, rollout
from .ipm import IpmOptions, IpmResult, solve_qp, solve_qp_batched
