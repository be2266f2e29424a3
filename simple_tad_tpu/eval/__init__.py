from simple_tad_tpu.eval.metrics import (  # noqa: F401
    THRESHOLDS, binary_metrics, binned_confusion_counts, auroc_binned,
    average_precision_binned, mcc_curve, auc_mcc)
