"""Training: losses, optimizer schedules, pjit data-parallel train loop."""
