"""Pure column-expression helpers — everything stays JVM-side (whole-stage
codegen), no Python UDFs in these modules."""
