"""Sources: synthetic pages generator + parquet table loaders."""
