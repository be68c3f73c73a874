"""Test-support utilities (oracle differential harness)."""
