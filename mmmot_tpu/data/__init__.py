from mmmot_tpu.data.kitti_io import (KittiObject, read_kitti_tracking_labels,
                                     write_kitti_result)
from mmmot_tpu.data.synthetic import SyntheticWorld, make_synthetic_sequence
