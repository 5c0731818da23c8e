"""Boolean FHEW, dynamic large-precision, JSON serialization (role of
``binfhe/examples/boolean-serial-json-dynamic-large-precision.cpp``):
identical flow to the binary variant, through the JSON flavor."""

FMT = "json"
exec(open(__file__.replace("json_dynamic", "binary_dynamic")).read(),
     {"FMT": FMT, "__file__": __file__.replace("json_dynamic",
                                               "binary_dynamic")})
