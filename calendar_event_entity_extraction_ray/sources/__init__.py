"""Sources: deterministic synthetic fixture generators and readers."""
