"""Sinks: file writers with modes, partition masks, and split options."""
