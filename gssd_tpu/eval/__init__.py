from gssd_tpu.eval.ap_iobb import (  # noqa: F401
    evaluate_detections,
    run_detection_eval,
    voc_ap,
)
