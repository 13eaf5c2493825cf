// End-to-end smoke for the C# binding against a live april-serve.
// (Counterpart of the reference's C# example, reference:
// bindings/csharp/Program.cs semantics; run by tools/ci.sh when a dotnet
// toolchain is present.)
//
//   dotnet run --project bindings/csharp/AprilAsrTpu.Smoke <host:port>
//
// Exit codes: 0 = received results, 2 = connect failed, 3 = no results.

using AprilAsrTpu;

if (args.Length != 1)
{
    Console.Error.WriteLine("usage: AprilAsrTpu.Smoke <host:port>");
    return 1;
}

int nResults = 0;
var done = new ManualResetEventSlim();

AprilModel model;
try
{
    model = new AprilModel(args[0]);
}
catch (Exception e)
{
    Console.Error.WriteLine($"connect failed: {e.Message}");
    return 2;
}

Console.Error.WriteLine(
    $"Model: {model.Name} [{model.Language}] {model.SampleRate} Hz");

using (var session = new AprilSession(model, (kind, tokens) =>
{
    Interlocked.Increment(ref nResults);
    if (kind == AprilResultKind.FinalRecognition)
    {
        Console.WriteLine("@ " + string.Concat(tokens.Select(t => t.Token)));
        done.Set();
    }
}))
{
    // 1 s of 440 Hz tone + noise at 16 kHz
    var rng = new Random(7);
    var chunk = new short[3200];
    for (int c = 0; c < 5; c++)
    {
        for (int i = 0; i < chunk.Length; i++)
        {
            double t = (c * 3200 + i) / 16000.0;
            chunk[i] = (short)(8000 * Math.Sin(2 * Math.PI * 440 * t)
                + rng.Next(-2000, 2000));
        }
        session.FeedPcm16(chunk);
    }
    session.Flush();
    done.Wait(TimeSpan.FromSeconds(120));
}
model.Dispose();

Console.Error.WriteLine($"results: {nResults}");
return nResults > 0 ? 0 : 3;
