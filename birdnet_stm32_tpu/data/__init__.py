"""Dataset discovery, species lists, device-side augmentation, input pipeline."""
