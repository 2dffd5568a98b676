"""Sources: batch/stream readers and derived dimension tables."""
