#!/bin/bash
# Run a graft main class in a plain JVM (no sbt lock): tools/run_java.sh <MainClass> [args...]
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
MODOPTS=$(java -cp "/opt/spark/jars/*" org.apache.spark.launcher.JavaModuleOptions 2>/dev/null)
if [ -z "$MODOPTS" ]; then
MODOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED -Djdk.reflect.useDirectMethodHandleAccessor=false"
fi
exec java $MODOPTS -Xmx24g -Djava.class.path="$CP" -cp "$CP" "$@"
