from .params import init_goat_params, count_params
