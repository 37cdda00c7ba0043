"""Sources: corpus front-door, file-format readers/writers, test fixtures."""
