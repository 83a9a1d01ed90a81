"""Driver-side planning: template DSL parsing and compilation to Spark plans."""
