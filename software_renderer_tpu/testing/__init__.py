"""Test support: the scalar numpy oracle mirroring the reference exactly."""
