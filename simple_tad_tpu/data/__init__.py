from simple_tad_tpu.data.sequencing import (  # noqa: F401
    RegularSequencer, RegularSequencerWithStart, UnsafeOverlapSequencer)
from simple_tad_tpu.data.labels import compute_time_vector, smooth_labels  # noqa: F401
