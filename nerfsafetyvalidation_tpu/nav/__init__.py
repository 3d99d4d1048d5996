"""Navigation stack (reference L4: nav/).

Public API mirrors nav/__init__.py:1-4: Estimator, Agent, Planner,
vec_to_rot_matrix, rot_matrix_to_vec.
"""

from .math_utils import vec_to_rot_matrix, rot_matrix_to_vec
from .agent import Agent
from .planner import Planner
from .estimator import Estimator

__all__ = ["Estimator", "Agent", "Planner", "vec_to_rot_matrix",
           "rot_matrix_to_vec"]
