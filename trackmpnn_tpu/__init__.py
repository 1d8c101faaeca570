"""TrackMPNN-TPU: a TPU-native message-passing multi-object-tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
arangesh/TrackMPNN reference (PyTorch, CUDA).  The dynamic rolling-window
bipartite detection/association graph lives on device in padded, bucketed
index form (edges are explicit (past, future) detection-slot pairs); message
passing is gathers + signed segment-sums instead of dense N x N sparse
matmuls; the teacher-forced training schedule is precomputed on host so one
jit'd `lax.scan` runs an entire truncated-BPTT window with zero per-step
host<->device round trips (the reference pays a CPU<->GPU round trip every
timestep, see /root/reference/utils/graph.py:216-221).
"""

__version__ = "0.1.0"
