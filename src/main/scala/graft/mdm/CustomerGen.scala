package graft.mdm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 21-column 3-source CUSTOMER generator — the record-shaped
  * twin of PageGen (VERDICT r1 missing #5; reference G1-G5:
  * /root/reference/batch_mdm_gcp/spark_data_generator/spark_data_generator.py:65-125,
  * /root/reference/batch_mdm_gcp/data_generator.py:24-165).
  *
  * Reference semantics kept: 3 sources with coverage CRM 80% / ERP 70% /
  * ECOM 60% (data_generator.py:177,205,229), duplicate multiplicity 1-3
  * (:182-183), nickname substitutions (John->Jon, ... :25-36), address
  * abbreviations (Street->St, ... :37-45), phone reformatting (:46-53) —
  * but fully deterministic: every choice is an xxhash64 bucket of
  * (customer, source, copy, seed); no Faker, no rand() (SURVEY.md §7.5.5).
  */
object CustomerGen {

  private val firstNames = Seq("John", "Michael", "William", "Robert", "James",
    "Christopher", "Matthew", "Anthony", "Elizabeth", "Jennifer", "Maria",
    "Susan", "Margaret", "Dorothy", "Lisa", "Karen", "Daniel", "Paul",
    "Mark", "Donald", "George", "Kenneth", "Steven", "Edward")
  // nickname map applied as a 20%-bucket variation (data_generator.py:25-36)
  private val nickname = Map("John" -> "Jon", "Michael" -> "Mike",
    "William" -> "Bill", "Robert" -> "Bob", "James" -> "Jim",
    "Christopher" -> "Chris", "Matthew" -> "Matt", "Anthony" -> "Tony",
    "Elizabeth" -> "Liz", "Jennifer" -> "Jen")
  private val lastNames = Seq("Smith", "Johnson", "Williams", "Brown", "Jones",
    "Garcia", "Miller", "Davis", "Rodriguez", "Martinez", "Hernandez",
    "Lopez", "Gonzalez", "Wilson", "Anderson", "Thomas", "Taylor", "Moore",
    "Jackson", "Martin", "Lee", "Perez", "Thompson", "White")
  private val streets = Seq("Oak Street", "Maple Avenue", "Sunset Boulevard",
    "River Road", "Hillcrest Drive", "Cedar Street", "Park Avenue",
    "Lakeview Drive", "Main Street", "Elm Avenue")
  private val abbrev = Seq("Street" -> "St", "Avenue" -> "Ave",
    "Boulevard" -> "Blvd", "Road" -> "Rd", "Drive" -> "Dr")
  private val cities = Seq("Springfield", "Riverside", "Fairview", "Greenville",
    "Madison", "Georgetown", "Arlington", "Ashland", "Dover", "Hudson")
  private val states = Seq("CA", "TX", "NY", "FL", "IL", "PA", "OH", "GA", "NC", "MI")
  private val companies = Seq("Acme Corp", "Globex", "Initech", "Umbrella LLC",
    "Stark Industries", "Wayne Enterprises", "Hooli", "Vandelay Industries")
  private val jobs = Seq("Engineer", "Analyst", "Manager", "Director",
    "Consultant", "Designer", "Accountant", "Technician")
  private val segments = Seq("enterprise", "smb", "consumer")

  private def bucket(mod: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(mod.toLong)).cast("int")

  private def pick(pool: Seq[String], mod: Column): Column =
    element_at(array(pool.map(lit): _*), mod + 1)

  /** G1-G4: customers with hidden entity structure across 3 sources.
    * Returns the 21 base columns + ground-truth `entity_id`. */
  def customersWithTruth(spark: SparkSession, nEntities: Int,
      seed: Long = 42L): DataFrame = {
    val ent = spark.range(nEntities.toLong).toDF("entity_id")
      .withColumn("seed", lit(seed))

    val src = ent.withColumn("source_system",
        explode(array(lit("crm"), lit("erp"), lit("ecommerce"))))
      .withColumn("cov",
        when(col("source_system") === "crm", 80)
          .when(col("source_system") === "erp", 70).otherwise(60))
      .where(bucket(100, col("entity_id"), col("source_system"), col("seed"), lit("cov")) < col("cov"))

    // duplicate multiplicity 1-3 (5% triple / 15% double, data_generator.py:182-183)
    val mult = bucket(100, col("entity_id"), col("source_system"), col("seed"), lit("mult"))
    val dup = src
      .withColumn("n_copies", when(mult < 5, 3).when(mult < 20, 2).otherwise(1))
      .withColumn("copy", explode(sequence(lit(0), col("n_copies") - 1)))

    // ---- base identity (entity-stable) ----------------------------------
    val fn0 = pick(firstNames, bucket(firstNames.size, col("entity_id"), col("seed"), lit("fn")))
    val ln = pick(lastNames, bucket(lastNames.size, col("entity_id"), col("seed"), lit("ln")))
    val streetNo = (bucket(9899, col("entity_id"), col("seed"), lit("no")) + 100).cast("string")
    val street0 = pick(streets, bucket(streets.size, col("entity_id"), col("seed"), lit("st")))
    val city = pick(cities, bucket(cities.size, col("entity_id"), col("seed"), lit("ci")))
    val state = pick(states, bucket(states.size, col("entity_id"), col("seed"), lit("sa")))
    val zip = format_string("%05d", bucket(90000, col("entity_id"), col("seed"), lit("zp")) + 10000)
    val phoneDigits = format_string("%03d-%03d-%04d",
      bucket(800, col("entity_id"), col("seed"), lit("p1")) + 200,
      bucket(1000, col("entity_id"), col("seed"), lit("p2")),
      bucket(10000, col("entity_id"), col("seed"), lit("p3")))

    // ---- per-record variation buckets -----------------------------------
    val vb = bucket(100, col("entity_id"), col("source_system"), col("copy"), col("seed"), lit("var"))

    val withId = dup
      .withColumn("fn0", fn0).withColumn("ln", ln)
      .withColumn("street0", concat(lit(""), streetNo, lit(" "), street0))
      .withColumn("city", city).withColumn("state", state).withColumn("zip_code", zip)
      .withColumn("phone0", phoneDigits)

    // nickname substitution on a 20% bucket (name_variations)
    val fnVar = nickname.foldLeft(col("fn0")) { case (c, (full, nick)) =>
      when(col("fn0") === full && col("vb") < 20, lit(nick)).otherwise(c)
    }
    // address abbreviation on a 30% bucket (address_variations)
    val addrVar = abbrev.foldLeft(col("street0")) { case (c, (full, ab)) =>
      when(col("vb") >= 20 && col("vb") < 50, regexp_replace(c, s"\\b$full\\b", ab)).otherwise(c)
    }
    // phone reformat by bucket (phone_formats)
    val phoneVar = when(col("vb") % 5 === 1, regexp_replace(col("phone0"), "-", "."))
      .when(col("vb") % 5 === 2, regexp_replace(col("phone0"), "-", " "))
      .when(col("vb") % 5 === 3, regexp_replace(col("phone0"), "-", ""))
      .when(col("vb") % 5 === 4, concat(lit("("), substring(col("phone0"), 1, 3), lit(") "),
        substring(col("phone0"), 5, 3), lit("-"), substring(col("phone0"), 9, 4)))
      .otherwise(col("phone0"))

    val out = withId
      .withColumn("vb", vb)
      .withColumn("first_name", fnVar)
      .withColumn("last_name", col("ln"))
      .withColumn("full_name", concat(col("first_name"), lit(" "), col("last_name")))
      .withColumn("email",
        // ecommerce drifts to an alias domain on a 25% bucket
        when(col("vb") % 4 === 0 && col("source_system") === "ecommerce",
          concat(lower(col("fn0")), lit("."), lower(col("ln")),
            col("entity_id"), lit("@mail.example.org")))
          .otherwise(concat(lower(col("fn0")), lit("."), lower(col("ln")),
            col("entity_id"), lit("@example.com"))))
      .withColumn("phone", phoneVar)
      .withColumn("address", addrVar)
      .withColumn("customer_id", concat(lit("CUST-"), col("entity_id").cast("string")))
      .withColumn("source_id",
        concat(upper(col("source_system")), lit("-"), col("entity_id"), lit("-"), col("copy")))
      .withColumn("record_id",
        substring(sha2(concat_ws("|", col("source_id"), col("seed")), 256), 1, 36))
      .withColumn("date_of_birth",
        date_add(lit("1960-01-01").cast("date"), bucket(14600, col("entity_id"), col("seed"), lit("dob"))))
      .withColumn("company", pick(companies, bucket(companies.size, col("entity_id"), col("seed"), lit("co"))))
      .withColumn("job_title", pick(jobs, bucket(jobs.size, col("entity_id"), col("seed"), lit("jt"))))
      .withColumn("annual_income",
        (bucket(150, col("entity_id"), col("seed"), lit("inc")) * 1000 + 30000))
      .withColumn("customer_segment", pick(segments, bucket(segments.size, col("entity_id"), col("seed"), lit("sg"))))
      .withColumn("registration_date",
        date_add(lit("2015-01-01").cast("date"), bucket(3000, col("entity_id"), col("source_system"), col("seed"), lit("rg"))))
      .withColumn("last_activity_date",
        date_add(col("registration_date"), bucket(1000, col("entity_id"), col("source_system"), col("copy"), col("seed"), lit("la"))))
      .withColumn("is_active", bucket(10, col("entity_id"), col("seed"), lit("ac")) < 8)

    out.select("customer_id", "source_id", "source_system", "record_id",
      "first_name", "last_name", "full_name", "email", "phone", "address",
      "city", "state", "zip_code", "date_of_birth", "company", "job_title",
      "annual_income", "customer_segment", "registration_date",
      "last_activity_date", "is_active", "entity_id")
  }

  /** Product input (no truth column). */
  def customers(spark: SparkSession, nEntities: Int, seed: Long = 42L): DataFrame =
    customersWithTruth(spark, nEntities, seed).drop("entity_id")

  /** G5: k-times scale-out multiplier — replicates the record set with
    * disjoint entity/id spaces per replica (the reference scales by running
    * the generator at N x partitions, submit_job.sh:118-144; this is the
    * same semantics as an operator, useful for load tests). */
  def scaled(customers: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    customers
      .withColumn("replica", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("customer_id", concat(col("customer_id"), lit("-r"), col("replica")))
      .withColumn("source_id", concat(col("source_id"), lit("-r"), col("replica")))
      .withColumn("record_id",
        substring(sha2(concat_ws("|", col("record_id"), col("replica")), 256), 1, 36))
      .withColumn("email", concat(col("replica").cast("string"), lit("."), col("email")))
      .drop("replica")
  }

  /** P1-P5 standardization over the generated records, using the
    * reference-literal scalars (Standardize.ref). */
  def standardized(customers: DataFrame): DataFrame =
    customers
      .withColumn("full_name_clean", Standardize.ref.nameClean(col("full_name")))
      .withColumn("email_clean", Standardize.ref.emailClean(col("email")))
      .withColumn("phone_clean", Standardize.ref.phoneClean(col("phone")))
      .withColumn("address_clean", Standardize.ref.addressClean(col("address")))
      .withColumn("city_clean", Standardize.ref.upperTrim(col("city")))
      .withColumn("state_clean", Standardize.ref.upperTrim(col("state")))
}
