"""Pipeline assembly, sinks and the resumable sharded runner."""
