from .metrics import cal_dtw, cal_cls, eval_item, eval_metrics
