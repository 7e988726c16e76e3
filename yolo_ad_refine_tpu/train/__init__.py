"""Training stack: loss, assigner, optimizer schedules, EMA, trainer."""
