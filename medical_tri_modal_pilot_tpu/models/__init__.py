from .registry import get_model, available_models, register
