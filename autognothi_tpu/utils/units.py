"""Unit type aliases used by the measurement reports."""

Seconds = float
GFLOPS = float
MParams = float
MiBytes = float
