from mmmot_tpu.kernels.affinity_kernel import (build_affinity_params,
                                               pallas_affinity,
                                               pallas_supported)
