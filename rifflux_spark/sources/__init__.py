"""Sources & sinks: page corpus readers, index table IO, file catalog."""
