"""xmlstreamprocessor_spark — a PySpark-native analytics engine with the
capabilities of kulalexey/XmlStreamProcessor, extended with a relational,
streaming, and LLM-data-pipeline operator surface.

The reference (a ~540-line C# XML stream -> typed-object extraction engine,
``/root/reference/XmlStreamProcessor/Parser.cs``) compiles a declarative
extraction lambda into a schema + codegen'd row constructor and streams XML
through it.  Here the same two-phase shape maps onto Spark natively:

* declarative extraction spec (``plans.spec``)  ==  the reference's
  expression-tree schema (Parser.cs:359-499)
* compiled ``StructType`` + evaluator            ==  the compiled generator
  delegate (Parser.cs:110-115)
* distributed execution (``sources.xml_batch``)  ==  the streaming parse loop
  (Parser.cs:119-208), but scaled out over Spark partitions.

Everything relational/streaming is plain DataFrame/SQL so Catalyst gets to
optimize it; Python runs only inside the XML shredder and explicitly-marked
escape hatches.
"""

__version__ = "0.1.0"
