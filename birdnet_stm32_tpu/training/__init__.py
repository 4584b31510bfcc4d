"""Training: losses, optimizer factory, train loop, QAT, LR finder, tuning."""
