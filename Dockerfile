# Container packaging — the Spark-native analog of the reference's
# image contract (/root/reference/Dockerfile:1-25, README.md:28-31):
# config file mounted in, database secrets as env vars, verdict on
# stdout, exit status 0 (within tolerance) / 1 (different) / 2
# (usage/config error).
#
#   docker build -t graft .
#   docker run --rm -v /working/dir/config.yaml:/config.yaml \
#     -e DB1_PASS=xxxxx -e DB2_PASS=xxxxx graft -f /config.yaml
#
# The apache/spark base image carries every runtime dependency
# (spark-sql, jackson-dataformat-yaml, the Derby embedded driver); the
# application itself is the thin `sbt package` jar, so no fat-jar
# assembly is needed. JDBC drivers for external databases (PostgreSQL,
# Oracle) are not redistributable here — mount or bake them into
# /opt/spark/jars the same way the reference installs the Oracle
# instant client.
FROM apache/spark:4.1.2-scala2.13-java17-ubuntu

# sbt package output (run `sbt package` first)
COPY target/scala-2.13/scribedbspark_2.13-0.1.0.jar /opt/graft/graft.jar

# local[*] by default — override with -m spark://host:7077 (or run the
# jar through your own spark-submit against a cluster; see README).
ENTRYPOINT ["/opt/spark/bin/spark-submit", \
  "--class", "graft.Main", \
  "--master", "local[*]", \
  "/opt/graft/graft.jar"]
CMD ["-f", "/config.yaml"]
