"""Physical-layout planning: partitioning, skew, plan inspection."""
