"""Sources: packet-capture readers and file-format frontends."""
