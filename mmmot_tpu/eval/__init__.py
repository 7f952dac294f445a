from mmmot_tpu.eval.hota import HotaEvaluation, HotaMetrics, evaluate_hota
from mmmot_tpu.eval.kitti_devkit import (TrackingEvaluation, TrackingMetrics,
                                         evaluate_tracking,
                                         evaluate_tracking_all_classes,
                                         read_seqmap)
