"""Misc utilities (reference map_nav_src/utils/misc.py)."""
from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
