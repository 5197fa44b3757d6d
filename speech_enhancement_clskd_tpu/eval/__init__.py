from .evaluate import evaluate_model, evaluate_bundle
