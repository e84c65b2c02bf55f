from workbook_exporter_fe_ray.sinks.yaml_sink import (  # noqa: F401
    linux_section_from_workbook,
    load_yaml_ordered,
    render_yaml,
    write_yaml_export,
)
