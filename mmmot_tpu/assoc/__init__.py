"""Data association: the reference's min-cost-flow ILP, TPU-native.

The reference solves, per frame, a binary ILP over link/new/end indicators
with OR-Tools CBC on the host (reference: tracking_model.py ->
TrackingModule.predict; SURVEY.md §3.2).  That per-frame GPU->CPU->ILP
ping-pong is its throughput ceiling.  Here the ILP is reduced *exactly* to a
square linear assignment problem (``cost.py``) and solved:

* in-graph with a batched Jacobi auction algorithm (``auction.py``) — exact
  up to the auction epsilon, jit/vmap/scan-friendly;
* in-graph with entropic Sinkhorn + rounding (``sinkhorn.py``) — fastest,
  approximate, used when throughput dominates;
* in-graph greedy (``greedy.py``) — cheap baseline;
* on the host with scipy (``ilp_oracle.py``) — exact oracle used for parity
  tests and as the reference-faithful fallback.
"""

from mmmot_tpu.assoc.cost import build_assignment_cost, decode_assignment
from mmmot_tpu.assoc.auction import (auction_lap, build_gain_matrix,
                                     decode_matching, solve_auction)
from mmmot_tpu.assoc.sinkhorn import sinkhorn_lap, solve_sinkhorn
from mmmot_tpu.assoc.greedy import solve_greedy
from mmmot_tpu.assoc.ilp_oracle import solve_ilp_oracle, solve_lap_oracle
from mmmot_tpu.assoc.solve import associate, AssocResult
