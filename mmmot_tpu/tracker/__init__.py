from mmmot_tpu.tracker.tracker import TrackerState, TrackingModule
from mmmot_tpu.tracker.sequence import (track_sequence,
                                        track_sequence_from_frames,
                                        track_sequences_batched,
                                        track_sequences_from_frames_batched)
