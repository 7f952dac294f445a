from mmmot_tpu.tracker.tracker import TrackerState, TrackingModule
from mmmot_tpu.tracker.sequence import track_sequence, track_sequences_batched
