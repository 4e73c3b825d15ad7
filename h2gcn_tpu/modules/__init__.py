"""Training-runtime modules: argument/hook engine, logging, checkpointing,
monitors, early stopping, and the lightweight run store."""
