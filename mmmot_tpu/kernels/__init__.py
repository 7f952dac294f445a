from mmmot_tpu.kernels.affinity_kernel import (fold_bn_into_dense,
                                               pallas_link_scores)
