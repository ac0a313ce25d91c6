"""Sources: synthetic corpus generator + table readers."""
