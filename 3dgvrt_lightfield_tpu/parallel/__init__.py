"""Multi-chip / multi-host sharding (new capability; none in the reference)."""
