from .domain import GeneralEvaluationDomain, Radix2EvaluationDomain  # noqa: F401
