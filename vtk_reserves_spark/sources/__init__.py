"""Sources & sinks: tabular loaders/writers, virtual grids, mesh tables."""
