from .min_time import (PlannerResult, minimum_time_planner_kinematic,
                       minimum_time_planner_dynamic)
from .reference import obtain_reference
