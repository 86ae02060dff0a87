package graft.ingest

import java.sql.{Date, Timestamp}
import java.time.LocalDate
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Seeded port of the reference's synthetic telco generators
  * (`create_iceberg.py:19-104` initial batch; `append_iceberg.py:18-102`
  * append batch). The reference uses unseeded faker/random — the one
  * deliberate change here is a seed, for reproducible fixtures
  * (FIXTURES.md §A). Generation happens on the driver at fixture scale
  * (hundreds of rows, like the reference's 200/6/200/5000/1000); the
  * distributed path for big synthetic data is `spark.range(n)` + column
  * expressions, not this class.
  */
final class TelcoDataGen(spark: SparkSession, seed: Long = 42L,
    today: LocalDate = LocalDate.parse("2026-01-01")) {

  private val rnd = new Random(seed)

  private def dateIn(from: LocalDate, to: LocalDate): Date = {
    val days = java.time.temporal.ChronoUnit.DAYS.between(from, to).toInt
    Date.valueOf(from.plusDays(rnd.nextInt(days + 1).toLong))
  }

  private def tsIn(from: LocalDate, to: LocalDate): Timestamp = {
    val lo = from.atStartOfDay.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val hi = to.atStartOfDay.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    new Timestamp(lo + (rnd.nextDouble() * (hi - lo)).toLong)
  }

  private val firstNames = Vector("Alice", "Ben", "Carla", "Dev", "Elena",
    "Farid", "Grace", "Hugo", "Ines", "Jon", "Kira", "Liam", "Mona", "Nils",
    "Omar", "Priya", "Quinn", "Rosa", "Sam", "Tara")
  private val lastNames = Vector("Adams", "Brown", "Chen", "Diaz", "Evans",
    "Fischer", "Garcia", "Hansen", "Ito", "Jones", "Khan", "Lee", "Mora",
    "Novak", "Olsen", "Patel", "Quist", "Rossi", "Silva", "Tanaka")
  private val streets = Vector("Oak St", "Maple Ave", "Pine Rd", "Cedar Ln",
    "Elm Blvd", "Birch Way")
  private val cities = Vector("Springfield", "Rivertown", "Lakeview",
    "Hillcrest", "Fairfield")

  // --- customers: id, name, email, phone, address(+newline), reg_date ---
  // create_iceberg.py:19-33; registration uniform [today-5y, today].
  def customers(n: Int, startId: Int = 1,
      regFrom: Option[LocalDate] = None): DataFrame = {
    val from = regFrom.getOrElse(today.minusYears(5))
    val rows = (0 until n).map { i =>
      val id = startId + i
      val name = s"${firstNames(rnd.nextInt(firstNames.size))} ${lastNames(rnd.nextInt(lastNames.size))}"
      val email = s"user$id@example.com"
      val phone = f"+1-555-${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d"
      // reference addresses are multi-line (`create_iceberg.py:28`)
      val address = s"${rnd.nextInt(9999) + 1} ${streets(rnd.nextInt(streets.size))}\n" +
        s"${cities(rnd.nextInt(cities.size))}, ST ${10000 + rnd.nextInt(90000)}"
      Row(id, name, email, phone, address, dateIn(from, today))
    }
    spark.createDataFrame(rows.asJava, TelcoDataGen.customersSchema)
  }

  // --- plans: 6 fixed rows, row 6 NULL allowances (`create_iceberg.py:36-43`) ---
  def plans(): DataFrame = {
    val rows = Seq(
      Row(1, "Basic Prepaid", "Prepaid", 10.0, Integer.valueOf(5), Integer.valueOf(100), Integer.valueOf(50)),
      Row(2, "Standard Prepaid", "Prepaid", 20.0, Integer.valueOf(15), Integer.valueOf(300), Integer.valueOf(100)),
      Row(3, "Data Hog Prepaid", "Prepaid", 35.0, Integer.valueOf(50), Integer.valueOf(50), Integer.valueOf(50)),
      Row(4, "Basic Postpaid", "Postpaid", 30.0, Integer.valueOf(20), Integer.valueOf(500), Integer.valueOf(200)),
      Row(5, "Premium Postpaid", "Postpaid", 50.0, Integer.valueOf(100), Integer.valueOf(1000), Integer.valueOf(500)),
      Row(6, "Ultimate Postpaid", "Postpaid", 80.0, null, null, null))
    spark.createDataFrame(rows.asJava, TelcoDataGen.plansSchema)
  }

  // --- subscriptions: 1:1 with customers; status 8:1:1; end_date only
  //     when Inactive (`create_iceberg.py:47-66`) ---
  def subscriptions(customerIds: Seq[Int], startId: Int = 1,
      alwaysActive: Boolean = false): DataFrame = {
    val rows = customerIds.zipWithIndex.map { case (cid, i) =>
      val start = dateIn(today.minusYears(4), today.minusYears(1))
      val status =
        if (alwaysActive) "Active" // appends are always Active (`append_iceberg.py:59`)
        else rnd.nextInt(10) match {
          case 8 => "Inactive"
          case 9 => "Suspended"
          case _ => "Active"
        }
      val end: Date =
        if (status == "Inactive") dateIn(start.toLocalDate, today) else null
      Row(startId + i, cid, rnd.nextInt(6) + 1, start, end, status)
    }
    spark.createDataFrame(rows.asJava, TelcoDataGen.subscriptionsSchema)
  }

  // --- usage_records (`create_iceberg.py:68-82`) ---
  def usageRecords(n: Int, customerIds: Seq[Int], startId: Int = 1): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(startId + i,
        customerIds(rnd.nextInt(customerIds.size)),
        tsIn(today.minusYears(1), today),
        math.rint((10.0 + rnd.nextDouble() * (1024.0 - 10.0)) * 100) / 100,
        rnd.nextInt(61), rnd.nextInt(21))
    }
    spark.createDataFrame(rows.asJava, TelcoDataGen.usageSchema)
  }

  // --- recharges: prepaid customers only (`create_iceberg.py:84-104`) ---
  def recharges(n: Int, prepaidCustomerIds: Seq[Int], startId: Int = 1): DataFrame = {
    val amounts = Vector(10.0, 20.0, 30.0, 50.0, 100.0)
    val methods = Vector("Credit Card", "Debit Card", "Online Wallet", "Voucher")
    val rows = (0 until n).map { i =>
      Row(startId + i,
        prepaidCustomerIds(rnd.nextInt(prepaidCustomerIds.size)),
        dateIn(today.minusYears(1), today),
        amounts(rnd.nextInt(amounts.size)),
        methods(rnd.nextInt(methods.size)))
    }
    spark.createDataFrame(rows.asJava, TelcoDataGen.rechargesSchema)
  }
}

object TelcoDataGen {
  // DDL from `create_iceberg.py:119-148` (SURVEY.md §1.2).
  val customersSchema: StructType = StructType(Seq(
    StructField("customer_id", IntegerType, nullable = false),
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("phone_number", StringType),
    StructField("address", StringType),
    StructField("registration_date", DateType)))

  val plansSchema: StructType = StructType(Seq(
    StructField("plan_id", IntegerType, nullable = false),
    StructField("plan_name", StringType),
    StructField("plan_type", StringType),
    StructField("monthly_fee", DoubleType),
    StructField("data_allowance_gb", IntegerType, nullable = true),
    StructField("voice_minutes", IntegerType, nullable = true),
    StructField("sms_allowance", IntegerType, nullable = true)))

  val subscriptionsSchema: StructType = StructType(Seq(
    StructField("subscription_id", IntegerType, nullable = false),
    StructField("customer_id", IntegerType),
    StructField("plan_id", IntegerType),
    StructField("start_date", DateType),
    StructField("end_date", DateType, nullable = true),
    StructField("status", StringType)))

  val usageSchema: StructType = StructType(Seq(
    StructField("usage_id", IntegerType, nullable = false),
    StructField("customer_id", IntegerType),
    StructField("usage_date", TimestampType),
    StructField("data_used_mb", DoubleType),
    StructField("voice_minutes_used", IntegerType),
    StructField("sms_sent", IntegerType)))

  val rechargesSchema: StructType = StructType(Seq(
    StructField("recharge_id", IntegerType, nullable = false),
    StructField("customer_id", IntegerType),
    StructField("recharge_date", DateType),
    StructField("amount", DoubleType),
    StructField("payment_method", StringType)))
}
