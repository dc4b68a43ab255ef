from .spec import FieldSpec, field_spec  # noqa: F401
