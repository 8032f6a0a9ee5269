from .masks import gen_seq_masks, extend_neg_masks, NEG_INF_MASK_VALUE
from .activations import gelu_erf, ACT2FN
