"""Plan-level helpers: config profiles, plan inspection."""
